package graft.functions

/** CJK → ASCII transliteration tables backing [[AsciiFold]] (the last
  * `unidecode` coverage gap from reference `embeddings-pipeline.py:63-72`).
  *
  * Four independent mechanisms, cheapest-derivation-first:
  *
  *  - '''Hangul syllables''' (U+AC00–U+D7A3): fully algorithmic — decompose
  *    the syllable index into (choseong, jungseong, jongseong) jamo and map
  *    each through the standard jamo transliteration (`한국` → `hangug`,
  *    the letter-for-letter convention `unidecode` also uses, not the
  *    sound-change Revised-Romanization variant).
  *  - '''Kana''' (U+3041–U+30FF): derived from the JDK's Unicode character
  *    names — "HIRAGANA LETTER KA" → `ka` — with a small Hepburn exception
  *    table for the syllables Unicode names in Nihon-shiki (SI→shi, TU→tsu,
  *    …). Small kana romanize like their full forms (per-codepoint
  *    transliteration is context-free by design, like `unidecode`).
  *  - '''Fullwidth forms''' (U+FF01–U+FF5E, U+3000): algorithmic offset to
  *    their ASCII originals.
  *  - '''CJK Unified Ideographs''': a bounded hand-written table of the
  *    most frequent simplified-Chinese characters mapped to toneless
  *    pinyin; emitted lowercase with a trailing space so adjacent
  *    syllables stay word-separated (`中国` → `zhong guo `) — a
  *    romanization-convention choice, documented in SURVEY §7.4.1.
  *    Characters outside the table stay unmapped and are dropped by
  *    [[AsciiFold.fold]], like `unidecode`'s unmappable codepoints.
  */
object CjkFold {

  // --- Hangul (algorithmic) -------------------------------------------
  private val choseong = Array(
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "", "j",
    "jj", "ch", "k", "t", "p", "h")
  private val jungseong = Array(
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae", "oe",
    "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i")
  private val jongseong = Array(
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb", "ls",
    "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch", "k", "t",
    "p", "h")

  private def hangul(ch: Char): String = {
    val s = ch - 0xAC00
    choseong(s / 588) + jungseong(s % 588 / 28) + jongseong(s % 28)
  }

  // --- Kana (name-derived, Hepburn exceptions) ------------------------
  private val hepburn = Map(
    "SI" -> "shi", "TI" -> "chi", "TU" -> "tsu", "HU" -> "fu",
    "ZI" -> "ji", "DI" -> "ji", "DU" -> "zu")

  private val kana: Map[Char, String] = {
    val pat = "(HIRAGANA|KATAKANA) LETTER (SMALL )?([A-Z]+)".r
    (0x3041 to 0x30FF).flatMap { cp =>
      Option(Character.getName(cp)).collect {
        case pat(_, _, token) =>
          cp.toChar -> hepburn.getOrElse(token,
            token.toLowerCase(java.util.Locale.ROOT))
      }
    }.toMap
  }

  // --- CJK punctuation (small manual table) ---------------------------
  private val punct = Map(
    '。' -> ". ", '、' -> ", ", '・' -> " ", '「' -> "\"", '」' -> "\"",
    '『' -> "\"", '』' -> "\"", '《' -> "\"", '》' -> "\"", '〈' -> "\"",
    '〉' -> "\"", '〔' -> "(", '〕' -> ")", '【' -> "(", '】' -> ")")

  // --- CJK Unified Ideographs → toneless pinyin -----------------------
  // Grouped `pinyin:characters`; most common reading wins for polyphones
  // (的→de, 了→le, 行→xing, 长→chang, …). Bounded by construction; the
  // builder rejects a character accidentally listed under two syllables.
  private val pinyinGroups = Seq(
    "a:啊阿", "ai:爱艾碍癌哀挨矮唉", "an:安按案暗岸俺", "ang:昂", "ao:奥澳傲熬",
    "ba:八把爸吧拔罢霸巴", "bai:白百摆败拜柏", "ban:半办班般板版搬伴扮拌",
    "bang:帮棒邦榜膀", "bao:包报保抱宝暴薄爆胞堡", "bei:北被备背杯悲碑倍贝辈",
    "ben:本奔笨", "beng:崩", "bi:比必笔币避闭鼻彼逼壁臂毕碧蔽弊",
    "bian:边变便编遍辩辨", "biao:表标彪", "bie:别", "bin:宾滨",
    "bing:并病兵冰饼丙", "bo:波播博伯脖泊驳玻菠", "bu:不部布步补捕卜",
    "ca:擦", "cai:才采菜财材彩裁猜踩", "can:参残餐惨灿蚕", "cang:藏仓苍舱",
    "cao:草操曹槽", "ce:测册策侧厕", "ceng:层曾", "cha:查茶差插叉察",
    "chai:拆柴", "chan:产缠铲颤", "chang:长常场厂唱尝偿昌肠畅",
    "chao:超朝潮炒吵抄", "che:车彻撤扯", "chen:陈沉晨尘衬臣辰",
    "cheng:成城程称承诚乘撑呈惩秤", "chi:吃持迟池赤尺翅斥耻驰",
    "chong:充冲虫崇", "chou:抽愁丑臭筹酬仇绸", "chu:出处除初楚触储厨础畜",
    "chuan:传船穿川串喘", "chuang:创窗床闯", "chui:吹垂锤炊", "chun:春纯唇蠢",
    "ci:次此词磁雌辞慈刺", "cong:从匆聪葱", "cu:粗促醋", "cui:催脆翠摧",
    "cun:存村寸", "cuo:错措搓",
    "da:大打达答搭", "dai:带代待戴袋贷呆逮", "dan:但单担蛋弹淡旦胆诞",
    "dang:当党挡档荡", "dao:到道导倒刀岛盗稻祷", "de:的得德",
    "deng:等登灯邓凳瞪", "di:地第低底敌抵滴弟帝递蒂笛缔",
    "dian:点电店典淀殿垫颠", "diao:调掉钓吊雕", "die:跌爹叠蝶",
    "ding:定订顶丁盯钉锭", "diu:丢", "dong:动东懂冬洞冻栋董",
    "dou:都斗豆逗兜陡", "du:度读独毒渡肚杜堵赌睹", "duan:段断短端锻",
    "dui:对队堆兑", "dun:吨顿蹲盾炖", "duo:多夺朵躲堕舵",
    "e:饿恶额俄鹅蛾", "en:恩", "er:而二儿耳尔饵",
    "fa:发法罚乏伐阀", "fan:反饭范凡翻烦繁返泛犯帆番贩",
    "fang:方放房防访仿纺芳妨", "fei:非飞费肥废肺匪诽",
    "fen:分份粉奋愤纷坟焚", "feng:风封丰蜂峰锋疯缝凤讽奉", "fo:佛", "fou:否",
    "fu:夫服福副复府父负富妇付扶符附腐赴浮覆辅抚腹肤幅伏俯斧赋",
    "ga:尬", "gai:该改盖概钙", "gan:干感敢赶甘肝杆柑竿",
    "gang:刚钢港岗纲缸", "gao:高告搞稿糕膏", "ge:个各格歌哥割阁隔革葛胳鸽搁",
    "gei:给", "gen:根跟", "geng:更耕颈梗", "gong:工公共功攻供宫贡恭巩躬",
    "gou:够构狗购沟勾钩", "gu:古故顾股骨谷鼓孤姑估固雇辜菇",
    "gua:挂刮瓜寡卦", "guai:怪乖拐", "guan:关管观官馆惯冠灌罐贯",
    "guang:光广逛", "gui:规贵归鬼桂柜轨跪龟", "gun:滚棍", "guo:国过果锅郭裹",
    "ha:哈", "hai:还海害孩亥骇", "han:汉含寒喊汗韩旱憾罕捍焊", "hang:航杭",
    "hao:好号毫豪耗浩", "he:和合河何核喝贺呵荷禾盒赫褐", "hei:黑嘿",
    "hen:很恨狠痕", "heng:横恒衡哼", "hong:红宏洪轰虹鸿哄",
    "hou:后候厚侯喉吼猴", "hu:护湖户呼胡虎壶互糊弧忽狐蝴",
    "hua:话化华花划画滑猾", "huai:坏怀淮徊", "huan:欢换环缓幻唤患宦涣焕",
    "huang:黄皇荒慌煌晃谎凰", "hui:会回汇挥辉灰毁悔恢慧绘惠晦贿",
    "hun:婚混魂浑昏荤", "huo:或活火货获伙惑霍祸豁",
    "ji:机几及即级极计记济急集己纪基技际剂季既激寄绩迹饥辑籍吉挤脊圾冀妓忌悸祭击",
    "jia:家加价假架甲佳嘉夹驾嫁稼颊",
    "jian:见间件建简坚检减剑肩渐监兼歼艰奸捡柬碱拣荐贱键箭舰",
    "jiang:将讲江奖降疆姜浆僵匠酱蒋",
    "jiao:教交叫较角脚焦骄郊浇娇搅缴绞狡胶椒饺",
    "jie:接解界结节街姐介借戒届皆捷截劫洁杰竭",
    "jin:进近金今仅紧尽斤禁津筋晋锦",
    "jing:经京精境警竞静惊景敬镜径井睛晶兢净", "jiong:窘",
    "jiu:就九久酒旧救究纠揪舅灸",
    "ju:局据具举句巨聚拒剧居距俱菊鞠拘矩惧驹锯", "juan:卷捐娟倦绢",
    "jue:决觉绝爵嚼掘", "jun:军均君俊菌峻竣骏",
    "ka:卡咖", "kai:开凯慨", "kan:看刊砍堪坎", "kang:抗康慷扛炕",
    "kao:考靠烤拷", "ke:可科克课刻客颗棵柯渴壳咳苛", "ken:肯恳啃垦",
    "keng:坑", "kong:空控孔恐", "kou:口扣寇", "ku:苦哭库裤枯窟酷",
    "kua:夸跨垮挎", "kuai:快块筷", "kuan:宽款", "kuang:况矿狂框旷眶筐",
    "kui:亏愧奎馈窥", "kun:困昆捆", "kuo:扩括阔廓",
    "la:拉啦辣蜡腊喇", "lai:来赖莱", "lan:蓝篮栏烂懒览滥拦揽缆",
    "lang:浪朗郎狼廊", "lao:老劳牢捞姥烙", "le:了乐勒",
    "lei:类累雷泪垒磊蕾", "leng:冷愣",
    "li:里理力利立李历例离礼丽励黎厉璃莉厘栗砾吏沥", "lia:俩",
    "lian:连联脸练恋炼廉莲镰怜帘", "liang:两量亮辆粮梁良凉谅晾",
    "liao:料疗辽聊僚廖撩", "lie:列烈裂猎劣", "lin:林临邻磷鳞凛赁淋",
    "ling:领令另零灵铃陵岭龄凌玲", "liu:六流留刘柳溜瘤硫榴",
    "long:龙隆笼聋垄拢", "lou:楼漏陋搂篓",
    "lu:路陆录卢炉鲁露庐芦颅碌鹿禄赂", "luan:乱卵", "lun:论轮伦仑沦",
    "luo:落罗络逻裸骆萝螺洛", "lv:绿律旅虑履屡侣驴铝滤",
    "ma:马吗妈码麻骂嘛玛", "mai:买卖麦埋迈脉", "man:满慢漫蛮瞒蔓馒",
    "mang:忙盲茫莽", "mao:毛猫矛冒贸帽貌茂锚", "me:么",
    "mei:没每美妹煤梅媒眉魅霉枚玫酶", "men:们门闷", "meng:梦猛蒙盟萌孟",
    "mi:米密秘迷蜜谜觅眯弥", "mian:面免棉眠绵勉缅", "miao:苗秒妙描庙瞄",
    "mie:灭蔑", "min:民敏悯闽", "ming:明名命鸣铭", "miu:谬",
    "mo:模磨摩魔末莫墨默漠陌膜摸抹", "mou:某谋牟",
    "mu:目木母亩幕墓慕牧穆姆募",
    "na:那拿哪纳娜钠", "nai:乃奶耐奈", "nan:南难男", "nang:囊",
    "nao:脑闹恼挠", "ne:呢", "nei:内馁", "nen:嫩", "neng:能",
    "ni:你尼泥妮逆溺拟腻", "nian:年念捻撵碾粘", "niang:娘酿", "niao:鸟尿",
    "nie:捏聂孽", "nin:您", "ning:宁凝拧柠", "niu:牛扭纽钮",
    "nong:农浓弄", "nu:努怒奴", "nuan:暖", "nuo:诺挪懦",
    "o:哦", "ou:欧偶呕殴鸥",
    "pa:怕爬帕趴", "pai:派拍排牌徘", "pan:盘判盼叛畔攀", "pang:旁庞胖乓",
    "pao:跑炮泡抛袍", "pei:配陪培赔佩裴", "pen:喷盆",
    "peng:朋碰棚蓬膨鹏捧烹", "pi:皮批匹披疲脾僻劈啤屁譬",
    "pian:片篇骗偏翩", "piao:票漂飘瓢", "pie:撇瞥", "pin:品贫聘拼频",
    "ping:平评瓶凭萍乒屏", "po:破迫婆坡泼颇魄", "pou:剖",
    "pu:普扑铺仆朴葡蒲谱曝瀑",
    "qi:起其七气期齐器汽奇企启妻棋旗弃契歧祈漆戚欺骑岂", "qia:恰洽掐",
    "qian:前千钱签浅潜迁欠牵谦乾铅谴嵌", "qiang:强枪墙抢腔",
    "qiao:桥巧敲悄瞧乔侨翘俏窍", "qie:切且窃怯", "qin:亲琴侵勤秦擒禽寝",
    "qing:请青清情轻庆倾晴氢顷卿", "qiong:穷琼", "qiu:求球秋丘邱囚",
    "qu:去取区曲趣屈趋驱渠娶躯", "quan:全权圈劝泉拳犬券",
    "que:却确缺雀鹊", "qun:群裙",
    "ran:然染燃冉", "rang:让嚷壤", "rao:绕扰饶", "re:热惹",
    "ren:人任认忍仁韧刃纫", "reng:仍扔", "ri:日", "rong:容荣融溶绒熔蓉",
    "rou:肉柔揉", "ru:如入汝儒乳辱", "ruan:软阮", "rui:瑞锐", "run:润闰",
    "ruo:若弱",
    "sa:撒萨洒", "sai:赛塞腮", "san:三散伞", "sang:桑丧嗓", "sao:扫嫂骚",
    "se:色瑟涩", "sen:森", "sha:杀沙啥傻纱厦煞", "shai:晒筛",
    "shan:山闪衫善扇删陕擅珊杉煽", "shang:上商伤尚赏裳",
    "shao:少绍烧稍勺哨邵捎梢", "she:社设舍射蛇涉摄舌赦",
    "shen:深身什神甚申伸审沈绅慎渗婶", "sheng:生声省胜升圣剩盛绳牲",
    "shi:是时十事实使世市式士师史示石食始施视识诗失室适试势释饰氏狮湿拾尸逝誓侍蚀驶匙",
    "shou:手受收首售授守瘦寿兽",
    "shu:书数术属树输束述熟殊舒叔鼠署薯淑梳蔬疏枢暑", "shua:刷耍",
    "shuai:摔甩率帅衰", "shuan:拴栓", "shuang:双爽霜", "shui:水谁睡税",
    "shun:顺瞬", "shuo:说硕烁",
    "si:四死思斯司似私丝寺撕肆饲伺祀", "song:送松宋颂诵耸", "sou:搜艘嗽",
    "su:素速苏诉宿俗塑肃粟溯", "suan:算酸蒜", "sui:岁随虽碎遂隋穗髓",
    "sun:孙损笋", "suo:所缩锁索唆梭",
    "ta:他她它塔踏塌", "tai:太台态抬泰胎苔", "tan:谈探坦叹炭摊贪滩瘫潭毯坛",
    "tang:堂糖汤唐躺趟塘倘烫", "tao:套讨逃桃涛掏萄淘陶", "te:特",
    "teng:疼腾藤", "ti:体提题替踢梯蹄剃涕惕屉", "tian:天田填甜添",
    "tiao:条跳挑", "tie:铁贴帖", "ting:听停厅挺庭亭艇廷",
    "tong:同通统痛童桶铜筒捅", "tou:头投透偷", "tu:土图突徒途涂屠兔吐",
    "tuan:团", "tui:推退腿褪", "tun:吞屯", "tuo:脱拖托妥拓驼椭",
    "wa:挖瓦娃哇袜蛙", "wai:外歪", "wan:万完晚湾玩碗弯挽顽腕婉",
    "wang:王望往网忘亡汪旺妄",
    "wei:为位未围卫委维味伟微危威胃唯谓尾慰伪魏惟纬违",
    "wen:文问闻温稳吻纹蚊", "weng:翁嗡", "wo:我握窝卧沃蜗",
    "wu:五无物务武午舞屋污误悟吴乌雾勿伍捂诬",
    "xi:西系息希习洗细戏吸喜析席袭惜稀溪锡牺膝嘻熄媳悉",
    "xia:下夏吓虾峡狭霞辖",
    "xian:现先线县显险限闲献鲜嫌衔贤弦咸掀仙纤",
    "xiang:想向相象响香乡项享箱详祥巷厢镶橡翔",
    "xiao:小笑消效校销晓孝肖削宵萧啸",
    "xie:写些谢协鞋斜携泄卸屑蟹邪歇蝎", "xin:新心信辛欣薪芯锌",
    "xing:行性型形星兴刑醒幸姓腥", "xiong:雄兄胸凶熊",
    "xiu:修秀休袖绣羞嗅锈", "xu:需许续须序虚吁绪叙徐旭絮墟",
    "xuan:选宣悬旋玄轩喧", "xue:学血雪穴靴", "xun:寻训迅讯巡询循旬逊熏",
    "ya:亚压呀牙雅哑鸭押芽崖涯",
    "yan:眼言严演研烟沿盐炎颜延岩宴艳验厌掩燕淹咽焰阎",
    "yang:样养羊阳洋杨扬仰氧痒央秧殃", "yao:要药摇遥咬腰邀妖耀窑谣",
    "ye:也业夜叶野爷液冶页椰",
    "yi:一以意已义议易衣医依移异益亿艺遗忆宜椅伊仪谊译疑乙翼逸蚁毅颐役疫",
    "yin:因引银音印隐饮阴姻吟尹",
    "ying:应英影营迎硬赢映盈颖鹰婴莹萤", "yo:哟",
    "yong:用永拥勇涌泳庸佣踊",
    "you:有又由右油游友优幼尤忧邮悠诱幽犹釉",
    "yu:于与鱼雨语育余遇预玉愚誉域欲狱喻郁愈浴羽渔娱淤禹宇寓裕豫",
    "yuan:元员原远院园愿源圆缘袁怨渊苑援", "yue:月越约阅跃悦岳粤",
    "yun:运云允匀韵晕孕酝",
    "za:杂砸咋", "zai:在再载灾栽宰", "zan:咱赞暂攒", "zang:脏葬",
    "zao:早造遭糟灶燥躁枣凿澡", "ze:则责泽择", "zei:贼", "zen:怎",
    "zeng:增赠憎", "zha:炸扎眨渣闸榨", "zhai:摘宅窄债斋",
    "zhan:站战展占沾斩辗崭盏蘸",
    "zhang:张章掌涨帐障账胀仗杖丈彰", "zhao:找照招召赵兆罩昭沼",
    "zhe:这着者折哲遮辙浙", "zhen:真阵镇针震振珍枕诊斟侦贞",
    "zheng:正政争整证征挣郑蒸睁狰筝怔",
    "zhi:之只知至指直制治质值职致织支纸止址志执智置植殖脂芝汁肢秩旨滞挚掷帜稚窒蜘",
    "zhong:中种重众终钟忠衷肿仲", "zhou:周州洲舟粥皱宙昼骤轴肘咒",
    "zhu:主住注助著逐诸朱猪竹烛筑驻柱铸珠煮嘱蛛瞩拄贮", "zhua:抓爪",
    "zhuai:拽", "zhuan:转专砖赚", "zhuang:装状壮庄撞桩妆",
    "zhui:追坠缀锥", "zhun:准", "zhuo:桌捉卓浊灼茁琢啄",
    "zi:子自字资姿紫滋仔咨籽梓滓", "zong:总宗纵踪棕综", "zou:走奏邹揍",
    "zu:组族足祖租阻卒诅", "zuan:钻", "zui:最嘴罪醉", "zun:尊遵",
    "zuo:做作坐左座昨佐")

  private val pinyin: Map[Char, String] = {
    val entries = pinyinGroups.flatMap { g =>
      val Array(py, chars) = g.split(":", 2)
      chars.map(_ -> (py + " "))
    }
    val dups = entries.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    require(dups.isEmpty,
      s"character listed under two syllables: ${dups.keys.mkString(",")}")
    entries.toMap
  }

  /** Transliterate one CJK-range character, or None if outside every
    * covered block (the caller drops it, `unidecode`-style). */
  def fold(ch: Char): Option[String] = {
    if (ch >= 0xAC00 && ch <= 0xD7A3) Some(hangul(ch))
    // Conjoining jamo (what NFD decomposes a syllable into, and how
    // decomposed Korean text arrives): same three transliteration tables.
    else if (ch >= 0x1100 && ch <= 0x1112) Some(choseong(ch - 0x1100))
    else if (ch >= 0x1161 && ch <= 0x1175) Some(jungseong(ch - 0x1161))
    else if (ch >= 0x11A8 && ch <= 0x11C2) Some(jongseong(ch - 0x11A8 + 1))
    else if (ch >= 0xFF01 && ch <= 0xFF5E) Some(((ch - 0xFEE0).toChar).toString)
    else if (ch == 0x3000) Some(" ")
    else kana.get(ch).orElse(punct.get(ch)).orElse(pinyin.get(ch))
  }

  /** Table size, exposed for the coverage spec. */
  private[functions] def pinyinSize: Int = pinyin.size
}
